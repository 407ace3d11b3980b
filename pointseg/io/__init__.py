from pointseg.io.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    restore_train_state,
    latest_checkpoint,
)
from pointseg.io.torch_import import (  # noqa: F401
    from_torch_state_dict,
    load_torch_checkpoint,
)
