from .bindings import (
    fxpref_available,
    imageops_available,
    build_native,
    c_shift_requant,
    c_conv2d_int,
    c_residual_add_int,
    c_avgpool_sum_int,
    c_gemm_int8,
    c_eval_preprocess_batch,
    c_train_preprocess_batch,
)
