from .int_engine import IntEngine, int_forward, float_sim_forward
