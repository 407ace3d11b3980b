from pointseg.io.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    restore_train_state,
    latest_checkpoint,
)
