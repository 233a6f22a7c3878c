from .fxp import (
    fix_quant,
    ste_quant,
    shift_requant,
    shift_requant_f32,
    requant_f32_eligible,
    F32_EXACT_BOUND,
    metric2fraclen,
    fraclen_gridsearch,
    metric_fn,
    SIGNED_COEFF,
    UNSIGNED_COEFF,
)
