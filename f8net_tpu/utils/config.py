"""Typed experiment configuration.

Preserves the reference's flag vocabulary (the ~25 quantization toggles a
F8Net user knows: weight_format/input_format [wl, fl] pairs, format_from_metric
vs format_grid_search, metric in {std,mae,rms}, per_layer/per_channel,
rescale_type, double_side, weight_only, no_clipping, quant_bias,
quant_avgpool/maxpool, pool_fusing, int_infer, integize, int_op_only,
bn_calib_*, finetune_iters, normalize -- reference: myutils/config.py and the
36 YAML files under apps/) but as frozen, hashable dataclasses so configs can
be static arguments to jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Quantization behavior knobs injected into every FXQ layer.

    Mirrors the per-module config injection of the reference trainer
    (fix_train.py:270-295).
    """

    weight_format: Tuple[int, int] = (8, 7)  # (word length, default fraclen)
    input_format: Tuple[int, int] = (8, 6)
    rescale_forward: bool = True  # linear layers
    rescale_forward_conv: bool = False
    rescale_type: str = "constant"  # or 'stddev'
    format_type: str = "per_layer"  # or 'per_channel'
    format_from_metric: bool = False
    format_grid_search: bool = False
    metric: str = "std"  # 'std' | 'mae' | 'rms'
    momentum_for_metric: float = 0.1
    no_clipping: bool = False
    input_fraclen_sharing: bool = False
    quant_bias: bool = False
    int_infer: bool = False
    int_op_only: bool = False
    integize: bool = False
    floating_model: bool = False  # clip-only float baseline
    floating_wo_clip: bool = False  # plain FP32 baseline
    normalize: bool = False  # ImageNet mean/std normalization (signed head input)
    quant_avgpool: bool = False
    quant_maxpool: bool = False
    pool_fusing: bool = False
    # Deployment-aware QAT (beyond the reference): '' trains the reference's
    # graph (residual carries at full precision); 'int8' additionally
    # quantizes every residual-block INPUT onto its first conv's 8-bit grid
    # with STE, so training sees the int8-boundary engine's carry semantics
    # (1-byte block boundaries) and the trained model deploys on that rung
    # without the accuracy cliff measured in r5 (docs/artifacts/r5/
    # r5_boundary_accuracy.json: R18 int8b -4.3pt top-1 when trained
    # without this).
    qat_boundary: str = ""
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    # TPU knob (beyond the reference, off by default): run the QAT
    # training-forward convs with bf16 operands + f32 accumulation.  The
    # main conv's operands are quantized-grid values that bf16 holds
    # exactly; the stat conv's raw weights round at ~2^-9 relative,
    # perturbing only the BN statistics; backward convs stay f32
    # (nn/quant_layers.py:_conv2d_bf16).  MEASURED on the v5e (2026-08-17,
    # docs/BENCHMARKS.md): neutral on ResNet18, 20% SLOWER on MobileNetV2 --
    # this toolchain sets --xla_allow_excess_precision=true, so XLA already
    # runs f32 convs at reduced internal precision and the explicit casts
    # only add fusion barriers.  Kept as a documented negative result.
    train_conv_bf16: bool = False

    @property
    def floating(self) -> bool:
        return self.floating_model

    def replace(self, **kw) -> "QuantConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer-level knobs (optimizer, schedule, phases)."""

    num_epochs: int = 150
    batch_size: int = 2048
    lr: float = 0.1
    lr_scheduler: str = "cos_annealing_iter"
    warmup_epochs: int = 5
    momentum: float = 0.9
    weight_decay: float = 4e-5
    nesterov: bool = True
    weight_decay_scheme: str = "all"
    multistep_lr_milestones: Tuple[int, ...] = (30, 60, 90)
    multistep_lr_gamma: float = 0.1
    exp_decaying_lr_gamma: float = 0.98
    exp_decaying_period: int = 1
    finetune_iters: Optional[int] = None
    bn_calib_before_test: bool = False
    bn_calib_batch_num: int = -1
    random_seed: int = 1995
    num_classes: int = 1000
    image_size: int = 224
    topk: Tuple[int, ...] = (1, 5)
    test_only: bool = False
    # per-iteration top-k error printing (fix_train.py:714-715)
    print_each_iter: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
