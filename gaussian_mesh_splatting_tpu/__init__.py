"""TPU-native Gaussian mesh splatting (GaMeS) framework.

See README.md for the architecture and SURVEY.md for the reference
analysis this framework was built against.
"""
__version__ = "0.1.0"

from . import core, io, models, ops, parallel, scene, train, utils
from .renderer import render
