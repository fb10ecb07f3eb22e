from .optim import (
    ExpMinScheduler,
    PlateauScheduler,
    WarmupPlateauScheduler,
    get_lr,
    get_optimizer,
    get_scheduler,
    set_lr,
)
from .trainer import TrainState, Trainer, load_checkpoint, make_loss_fn, save_checkpoint
