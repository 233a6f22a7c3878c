"""f8net_tpu — a TPU-native fixed-point INT8 training & inference framework.

Re-implements the capabilities of F8Net (ICLR 2022, snap-research/F8Net) from
scratch on JAX/XLA/Pallas: every conv/matmul on the inference hot path executes
as int8 x int8 multiplies with int32 accumulation and power-of-two (bit-shift)
requantization -- no FP32 and no 32-bit integer scale factors.

Subpackages
-----------
ops       -- fixed-point primitives (quantize, STE, shift-requant) + Pallas kernels
nn        -- quantized layer semantics (ConvBN, Linear, pools) and the layer graph
models    -- ResNet-18/34/50/101/152, MobileNetV1, MobileNetV2 model zoo
quant     -- QuantPlan baking (freeze fraclens -> compile-time constants) + conversion
engine    -- integer-only inference engine (XLA int8 + Pallas paths)
train     -- SGD training loop, LR schedules, weight-decay schemes, checkpointing
parallel  -- device mesh / sharding helpers (data + model axes over ICI/DCN)
data      -- input pipelines (image conditioning identical to the reference)
utils     -- config system, meters, profiling
importers -- PyTorch checkpoint dialect importers (ptcv / NVIDIA / HAWQ / reference)
"""

__version__ = "0.1.0"
