from .parser import Mechanism, parse_mechanism, load_mechanism
from .arrays import MechanismArrays, to_device_arrays

__all__ = [
    "Mechanism", "parse_mechanism", "load_mechanism",
    "MechanismArrays", "to_device_arrays",
]
