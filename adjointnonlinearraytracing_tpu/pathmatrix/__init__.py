from . import path_matrix
from .fuel2008 import fuel_reconstruction
