from .base import System, register_system, static_field
from .double_integrator import DoubleIntegrator, PlanarDoubleIntegrator
from .dubins import DubinsAbs, DubinsRel
from .flock import Flock
from .holonomic import Holonomic
from .rocket import RocketSystem

__all__ = [
    "System",
    "register_system",
    "static_field",
    "DoubleIntegrator",
    "PlanarDoubleIntegrator",
    "DubinsAbs",
    "DubinsRel",
    "Flock",
    "Holonomic",
    "RocketSystem",
]
