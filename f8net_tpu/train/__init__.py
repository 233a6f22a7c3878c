from .optim import SGDState, sgd_init, sgd_update, weight_decay_mask
from .schedules import lr_schedule
from .loop import (
    Trainer,
    cross_entropy_loss,
    condition_input,
    make_train_step,
    make_eval_step,
)
from .checkpoint import AsyncCheckpointer, save_checkpoint, load_checkpoint
