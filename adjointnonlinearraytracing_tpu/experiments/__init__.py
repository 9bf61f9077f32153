from . import config, voxel_scenes, common
from . import luneburg, image, fuel_injection, focalstack, fiber
