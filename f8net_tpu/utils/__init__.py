from .config import QuantConfig, TrainConfig
from .meters import ScalarMeter, flush_scalar_meters
