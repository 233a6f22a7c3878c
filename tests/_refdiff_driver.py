"""Reference-differential driver: executes the UPSTREAM F8Net PyTorch stack.

Run as a subprocess (never imported by pytest) with /root/reference mounted.
Two phases, mirroring the reference's own two-process workflow (train job
writes best_model.pt, a separate int_op_only job loads it and converts):

  qat  <workdir> --family resnet18 --steps 3 --batch 2 --seed 0
       Fill FLAGS from the family's *train* yml, instantiate the reference
       Model with its own random init, replicate fix_train.py:268-294's
       per-module config injection, run `steps` train-mode forwards (random
       [0,1) images) to populate BN running stats + EMA input fraclens, then
       an eval-mode forward.  Writes ckpt.pt (state_dict), input.npy (NCHW
       float in [0,1), pre-255-rounding), qat_eval_logits.npy, meta.json.

  int  <workdir> --family resnet18
       Fill FLAGS from the *test_int_op_only* yml, fresh Model + injection,
       load ckpt.pt, then exactly fix_train.py:930-934: set int_op_only on
       every module, model.int_model().cpu(), set int_op_only again.  Feed
       the saved input through forward_loss's conditioning for int_op_only
       (fix_train.py:690-692: (255*x).round().int(), output_fraclen=8) and
       write int_logits.npy plus a per-conv fraclen dump (fraclens.json).

The reference tree is treated as read-only public content: we call its
modules, we never edit or vendor them.
"""

import argparse
import json
import os
import sys

REF = os.environ.get("F8NET_REFERENCE", "/root/reference")

YMLS = {
    "resnet18": (
        "apps/imagenet/resnet18/conventional/res18_fix_quant_train.yml",
        "apps/imagenet/resnet18/conventional/res18_fix_quant_test_int_op_only.yml",
    ),
    "mobilenet_v1": (
        "apps/imagenet/mobilenetv1/conventional/mbv1_fix_quant_train.yml",
        "apps/imagenet/mobilenetv1/conventional/mbv1_fix_quant_test_int_op_only_on_cpu.yml",
    ),
    "mobilenet_v2": (
        "apps/imagenet/mobilenetv2/conventional/mbv2_fix_quant_train.yml",
        "apps/imagenet/mobilenetv2/conventional/mbv2_fix_quant_test_int_op_only_on_cpu.yml",
    ),
    # tiny_finetuning configuration: exercises normalize=True (signed head
    # input via ImageNet mean/std), no_clipping=True, and
    # format_grid_search=True (weight fraclens by grid search instead of
    # the sigma->fl metric) -- none of which the conventional configs touch
    "resnet50_tf": (
        "apps/imagenet/resnet50/tiny_finetuning/res50_fix_quant_ptcv_pretrained_train.yml",
        "apps/imagenet/resnet50/tiny_finetuning/res50_fix_quant_ptcv_pretrained_test_int_op_only_on_cpu.yml",
    ),
}

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]


def _condition(FLAGS, x):
    """The reference's data-side conditioning of raw [0,1) images.

    normalize=True: transforms.Normalize with the ImageNet constants
    (fix_train.py:300-306); else the (255x).round()/256 grid snap of
    forward_loss (fix_train.py:694)."""
    import torch

    if getattr(FLAGS, "normalize", False):
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        return (x - mean) / std
    return (255 * x).round() / 256


def _setup_flags(yml_rel, phase):
    sys.argv = [sys.argv[0], f"app:{os.path.join(REF, yml_rel)}", "bs:64"]
    sys.path.insert(0, REF)
    from myutils.config import FLAGS  # parses app:/bs: from argv at import

    # never touch CUDA in this container
    FLAGS.distributed = False
    FLAGS.distributed_all_reduce = False
    return FLAGS


def _inject(model, FLAGS):
    # mirrors fix_train.py:268-294 (get_model's per-module config injection);
    # fix_train itself imports torchvision+pytorchcv which this image lacks.
    from models.fix_quant_ops import ReLUClipFXQConvBN, ReLUClipFXQLinear

    for m in model.modules():
        if isinstance(m, (ReLUClipFXQConvBN, ReLUClipFXQLinear)):
            m.set_weight_format(FLAGS.weight_format)
            m.set_input_format(FLAGS.input_format)
            m.rescale_type = getattr(FLAGS, "rescale_type", "constant")
            m.set_alpha()
            m.floating = getattr(FLAGS, "floating_model", False)
            m.floating_wo_clip = getattr(FLAGS, "floating_wo_clip", False)
            m.format_type = getattr(FLAGS, "format_type", None)
            m.format_from_metric = getattr(FLAGS, "format_from_metric", False)
            m.metric = getattr(FLAGS, "metric", None)
            m.format_grid_search = getattr(FLAGS, "format_grid_search", False)
            m.set_metric_func()
            m.register_input_format(
                FLAGS.input_format,
                momentum=getattr(FLAGS, "momentum_for_metric", 0.1),
            )
            m.no_clipping = getattr(FLAGS, "no_clipping", False)
            m.input_fraclen_sharing = getattr(FLAGS, "input_fraclen_sharing", False)
            m.quant_bias = getattr(FLAGS, "quant_bias", False)
            m.int_infer = getattr(FLAGS, "int_infer", False)
        if isinstance(m, ReLUClipFXQConvBN):
            m.rescale_forward = getattr(FLAGS, "rescale_forward_conv", False)
        if isinstance(m, ReLUClipFXQLinear):
            m.rescale_forward = getattr(FLAGS, "rescale_forward", True)


def _build(FLAGS):
    import importlib

    lib = importlib.import_module(FLAGS.model)
    model = lib.Model(FLAGS.num_classes)
    _inject(model, FLAGS)
    return model


def phase_qat(work, family, steps, batch, seed, image_size):
    import numpy as np
    import torch

    FLAGS = _setup_flags(YMLS[family][0], "qat")
    if image_size:
        FLAGS.image_size = image_size
    torch.manual_seed(seed)
    model = _build(FLAGS)

    gen = torch.Generator().manual_seed(seed + 1)
    hw = FLAGS.image_size
    model.train()
    with torch.no_grad():
        for i in range(steps):
            x = torch.rand(batch, 3, hw, hw, generator=gen)
            model(_condition(FLAGS, x))

    x0 = torch.rand(batch, 3, hw, hw, generator=gen)
    model.eval()
    with torch.no_grad():
        logits = model(_condition(FLAGS, x0))

    torch.save({"model": model.state_dict()}, os.path.join(work, "ckpt.pt"))
    np.save(os.path.join(work, "input.npy"), x0.numpy())
    np.save(os.path.join(work, "qat_eval_logits.npy"), logits.numpy())

    emas = {
        n: [float(v) for v in m.input_fraclen.reshape(-1)]
        for n, m in model.named_modules()
        if hasattr(m, "input_fraclen")
    }
    with open(os.path.join(work, "meta.json"), "w") as f:
        json.dump(
            {"family": family, "image_size": hw, "batch": batch,
             "steps": steps, "seed": seed,
             "normalize": bool(getattr(FLAGS, "normalize", False)),
             "input_fl_ema": emas},
            f, indent=1,
        )
    print("qat done:", {k: round(v[0], 3) for k, v in list(emas.items())[:3]})


def phase_int(work, family):
    import numpy as np
    import torch

    FLAGS = _setup_flags(YMLS[family][1], "int")
    with open(os.path.join(work, "meta.json")) as f:
        meta = json.load(f)
    FLAGS.image_size = meta["image_size"]

    torch.manual_seed(0)
    model = _build(FLAGS)
    ckpt = torch.load(os.path.join(work, "ckpt.pt"), map_location="cpu",
                      weights_only=False)["model"]
    model.load_state_dict(ckpt)
    model.eval()

    # torch>=2 compat shim: the reference's int_conv/int_fc
    # (fix_quant_ops.py:705, :1180) assign int32 tensors to the fresh
    # nn.Conv2d/nn.Linear's .data while the Parameter still requires grad,
    # which modern torch rejects.  Make params of newly constructed
    # conv/linear modules grad-free during conversion; the reference itself
    # flips requires_grad=False right after the assignment, so semantics are
    # unchanged.
    import torch.nn as nn

    def _gradfree(cls):
        orig = cls.__init__

        def patched(self, *a, **k):
            orig(self, *a, **k)
            for p in self.parameters(recurse=False):
                p.requires_grad_(False)

        cls.__init__ = patched
        return orig

    orig_conv, orig_lin = _gradfree(nn.Conv2d), _gradfree(nn.Linear)

    # fix_train.py:930-934, verbatim sequence
    model.apply(lambda m: setattr(m, "int_op_only", True))
    imodel = model.int_model().cpu()
    nn.Conv2d.__init__, nn.Linear.__init__ = orig_conv, orig_lin
    imodel.apply(lambda m: setattr(m, "int_op_only", True))
    imodel.eval()

    x0 = torch.from_numpy(np.load(os.path.join(work, "input.npy")))
    if getattr(FLAGS, "normalize", False):
        # forward_loss's int_op_only conditioning under normalize
        # (fix_train.py:682-688): quantize the normalized input on the head
        # conv's own grid
        from models.fix_quant_ops import fix_quant

        head0 = imodel.head[0]
        xn = _condition(FLAGS, x0)
        xi = (
            fix_quant(xn, 8, head0.input_fraclen * 1.0, 1, head0.input_symmetric)[0]
            * (2 ** head0.input_fraclen)
        ).int()
        setattr(xi, "output_fraclen", head0.input_fraclen.item())
    else:
        xi = (255 * x0).round_().int()  # fix_train.py:690-692
        setattr(xi, "output_fraclen", 8)
    with torch.no_grad():
        y = imodel(xi)
    np.save(os.path.join(work, "int_logits.npy"), y.numpy())

    fr = {}
    ws = {}
    for n, m in imodel.named_modules():
        if hasattr(m, "weight_fraclen"):
            fr[n] = {
                "weight_fl": [int(v) for v in torch.as_tensor(m.weight_fraclen).reshape(-1)],
                "input_fl": [int(v) for v in torch.as_tensor(m.input_fraclen).reshape(-1)],
            }
            ws[n + ".w"] = m.weight.detach().numpy()
            if getattr(m, "bias", None) is not None:
                ws[n + ".b"] = m.bias.detach().numpy()
    with open(os.path.join(work, "fraclens.json"), "w") as f:
        json.dump(fr, f, indent=1)
    np.savez(os.path.join(work, "int_weights.npz"), **ws)
    print("int done: logits[0,:5] =", y.numpy()[0, :5])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["qat", "int"])
    ap.add_argument("workdir")
    ap.add_argument("--family", default="resnet18", choices=sorted(YMLS))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--image-size", type=int, default=0)
    a = ap.parse_args()
    os.makedirs(a.workdir, exist_ok=True)
    if a.phase == "qat":
        phase_qat(a.workdir, a.family, a.steps, a.batch, a.seed, a.image_size)
    else:
        phase_int(a.workdir, a.family)


if __name__ == "__main__":
    main()
