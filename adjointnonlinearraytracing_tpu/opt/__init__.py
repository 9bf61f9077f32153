from .multires import (
    multires_opt,
    upres_scene,
    upres_adam_state,
    boundary_interior_mask,
    save_checkpoint,
    load_checkpoint,
)
