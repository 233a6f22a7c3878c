from .config import QuantConfig
