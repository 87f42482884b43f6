from .lr_policy import get_lr_at_iter, lr_change_correction
from .optimizer import (
    MomentumSGDState,
    init_momentum_state,
    momentum_sgd_update,
    rescale_momentum,
)
from .train_step import TrainState, make_train_step, retinanet_losses, distill_losses
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    find_latest_checkpoint,
    convert_reference_pickle,
    load_reference_weights,
)
