from .sources import *  # noqa: F401,F403
from .sources import Rays  # noqa: F401
