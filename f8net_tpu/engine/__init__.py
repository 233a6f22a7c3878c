from .int_engine import IntEngine, int_forward, float_sim_forward
from .tp_engine import int_forward_tp
