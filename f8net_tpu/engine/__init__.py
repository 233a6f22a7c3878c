from .int_engine import IntEngine, int_forward, float_sim_forward
from .tp_engine import int_forward_tp
from .pp_engine import PPEngine, make_pipe_mesh
