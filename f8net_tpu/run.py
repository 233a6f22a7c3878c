"""CLI entry point: `python -m f8net_tpu.run app:<cfg.yml> bs:<batch>`.

The analog of the reference's only entry point (fix_train.py main /
train_val_test): loads a YAML experiment, builds the model, runs the
requested phase -- train / tiny-finetune / test-only in any of the four eval
modes (QAT-sim, int_model, integize, int_op_only) / bn-calibration -- with
checkpoint auto-resume and the per-layer fraclen dump at the end.

Dataset: `dataset_dir` with train/ and val/ ImageFolder trees, or
`dataset: synthetic` for smoke runs without data on disk.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp


def main(argv=None):
    from .data import ImageFolderDataset, Loader, SyntheticDataset
    from .engine import IntEngine
    from .importers import load_reference_checkpoint
    from .models import get_model
    from .quant import bake_plan
    from .train import AsyncCheckpointer, Trainer, load_checkpoint, save_checkpoint
    from .utils.flags import from_flags, load_yaml, parse_argv
    from .utils.reporting import fraclen_report

    argv = argv if argv is not None else sys.argv[1:]
    app, bs, _extra = parse_argv(argv)
    if app is None:
        print(__doc__)
        sys.exit(2)
    flags = load_yaml(app)
    cfg, tcfg, extras = from_flags(flags, bs)

    model_name = str(extras.get("model", "fix_resnet")).split(".")[-1]
    if model_name == "fix_resnet":
        model_name = f"resnet{extras.get('depth', 18)}"
    model = get_model(
        model_name, cfg, num_classes=tcfg.num_classes, image_size=tcfg.image_size
    )
    print(f"model: {model.name}  layers: {len(model.graph.names())}")

    # per-process seed offset decorrelates augmentation across hosts
    # (use_diff_seed, fix_train.py:807-817)
    seed = tcfg.random_seed
    if extras.get("use_diff_seed"):
        seed = seed + jax.process_index()
    trainer = Trainer(model, cfg, tcfg)
    params, state, opt = trainer.init(jax.random.PRNGKey(seed))

    if extras.get("fp_pretrained_file"):
        # full-precision init from our own npz checkpoint (the floating-model
        # training output), the analog of fp_pretrained_file (fix_train.py:840-862)
        trees, _ = load_checkpoint(extras["fp_pretrained_file"])
        params, state = trees["params"], trees["state"]
        print(f"Loaded full precision model {extras['fp_pretrained_file']}.")

    if extras.get("pretrained_file"):
        pf = extras["pretrained_file"]
        if pf.endswith((".npz",)) or os.path.exists(pf + ".npz"):
            trees, _ = load_checkpoint(pf)
            params, state = trees["params"], trees["state"]
        else:
            params, state = load_reference_checkpoint(model, pf, params, state)
        print(f"Loaded model {pf}.")

    # data
    image_size = tcfg.image_size
    if extras.get("dataset") == "synthetic":
        n = int(extras.get("synthetic_size", 512))
        train_ds = SyntheticDataset(n, image_size, tcfg.num_classes)
        val_ds = SyntheticDataset(max(n // 4, 1), image_size, tcfg.num_classes, seed=7)
    else:
        root = extras.get("dataset_dir", "data")
        train_ds = ImageFolderDataset(os.path.join(root, "train")) if not tcfg.test_only else None
        val_ds = ImageFolderDataset(os.path.join(root, "val"))
    nshards = jax.process_count()
    me = jax.process_index()
    mk = lambda ds, train: Loader(
        ds,
        batch_size=max(tcfg.batch_size // nshards, 1),
        train=train,
        normalize=cfg.normalize,
        image_size=image_size,
        shard=me,
        num_shards=nshards,
        num_workers=int(extras.get("data_loader_workers", 4)),
        seed=seed,
    )
    val_loader = mk(val_ds, False)
    train_loader = mk(train_ds, True) if train_ds is not None else None

    from .utils.flags import experiment_setting

    log_dir = extras.get("log_dir", "results")
    if extras.get("experiment_subdir", True):
        log_dir = os.path.join(log_dir, experiment_setting(cfg, tcfg, extras))
        print(f"log dir: {log_dir}")
    os.makedirs(log_dir, exist_ok=True)
    latest = os.path.join(log_dir, "latest_checkpoint")

    # integer conversion / export phases
    if cfg.integize or cfg.int_op_only:
        plan, int_params = bake_plan(model, params, state)
        eng = IntEngine(model, plan, int_params, int_only=cfg.int_op_only)
        out_dir = extras.get(
            "int_op_only_file_path" if cfg.int_op_only else "integize_file_path", ""
        )
        if out_dir:
            os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
            save_checkpoint(
                os.path.join(
                    out_dir,
                    "checkpoints",
                    "int_op_only_model" if cfg.int_op_only else "integized_model",
                ),
                {"int_params": int_params},
                meta={
                    "plan": [
                        {
                            "name": p.name,
                            "input_fl": p.input_fl,
                            "weight_fl": p.weight_fl,
                            "input_symmetric": p.input_symmetric,
                        }
                        for p in plan.layers
                    ]
                },
            )
            print(f"Converted model saved to {out_dir}.")
        # test loop over val set through the engine
        total, correct = 0, 0
        for images, labels in val_loader:
            y = eng(eng.condition_input(jnp.asarray(images)))
            correct += int(jnp.sum(jnp.argmax(y, -1) == jnp.asarray(labels)))
            total += labels.shape[0]
        print(f"test\t-1/{tcfg.num_epochs}: top1_error: {1 - correct / max(total, 1):.3f}")
        fraclen_report(model, params, state, cfg)
        return

    if tcfg.test_only:
        mode = "eval"
        params2, state2, opt2, res = trainer.run_epoch(
            params, state, opt, val_loader, -1, max(len(val_loader), 1), "test"
        )
        fraclen_report(model, params, state, cfg)
        return

    # resume
    last_epoch, best_val = 0, 1.0
    if os.path.exists(latest + ".npz"):
        trees, meta = load_checkpoint(latest)
        params, state = trees["params"], trees["state"]
        from .train.optim import SGDState

        opt = SGDState(momentum=trees["opt_momentum"])
        last_epoch = int(meta.get("last_epoch", 0))
        best_val = float(meta.get("best_val", 1.0))
        print(f"Loaded checkpoint {log_dir} at epoch {last_epoch}.")

    if tcfg.bn_calib_before_test:
        print("Start calibration.")
        from .quant.calibrate import reset_bn_for_calib

        state = reset_bn_for_calib(state)
        params, state, opt, _ = trainer.run_epoch(
            params, state, opt, train_loader, -1, max(len(train_loader), 1), "calib"
        )
        _, _, _, res = trainer.run_epoch(
            params, state, opt, val_loader, -1, max(len(val_loader), 1), "val"
        )
        save_checkpoint(
            os.path.join(log_dir, "best_model_bn_calibrated"),
            {"params": params, "state": state},
            meta={"val_top1_error": res["top1_error"]},
        )
        return

    print("Start training.")
    ckpt = AsyncCheckpointer()  # overlap checkpoint IO with the next epoch
    steps = max(len(train_loader), 1)
    for epoch in range(last_epoch, tcfg.num_epochs):
        train_loader.set_epoch(epoch)
        params, state, opt, _ = trainer.run_epoch(
            params, state, opt, train_loader, epoch, steps, "train"
        )
        _, _, _, res = trainer.run_epoch(
            params, state, opt, val_loader, epoch, steps, "val"
        )
        if me == 0:
            if res["top1_error"] < best_val:
                best_val = res["top1_error"]
                ckpt.save(
                    os.path.join(log_dir, "best_model"),
                    {"params": params, "state": state},
                    meta={"best_val": best_val},
                )
                print(f"New best validation top1 error: {best_val:.3f}")
            ckpt.save(
                latest,
                {"params": params, "state": state, "opt_momentum": opt.momentum},
                meta={"last_epoch": epoch + 1, "best_val": best_val},
            )
    ckpt.close()  # make all queued checkpoints durable before reporting
    fraclen_report(model, params, state, cfg)


if __name__ == "__main__":
    main()
