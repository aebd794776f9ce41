from .initial import InitialConditions, make_initial_fields
from . import allen_cahn, exact, frank
