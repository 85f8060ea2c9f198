from .optim import apply_grad_flags, lr_schedule, make_optimizer
from .step import TrainState, create_train_state, eval_step, refresh_grid, train_step
