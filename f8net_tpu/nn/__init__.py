from .spec import ConvBNSpec, LinearSpec, LayerGraph
from .quant_layers import (
    Act,
    init_conv_params,
    init_linear_params,
    init_conv_state,
    init_linear_state,
    fix_scaling,
    all_fix_scalings,
    conv_bn_apply,
    linear_apply,
    fxq_avgpool,
    fxq_maxpool,
    adaptive_avgpool,
    maxpool,
    residual_add_int_sim,
    AVGPOOL_SHIFT,
    AVGPOOL_SCALE,
)
