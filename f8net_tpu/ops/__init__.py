from .fxp import (
    fix_quant,
    ste_quant,
    shift_requant,
    metric2fraclen,
    fraclen_gridsearch,
    metric_fn,
    SIGNED_COEFF,
    UNSIGNED_COEFF,
)
