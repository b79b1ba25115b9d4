from .optim import sgd_init, sgd_update, optimizer_state_dict, load_optimizer_state_dict
from .steps import make_train_step, make_eval_step, TrainState, ungroup_pred_sample

__all__ = ['sgd_init', 'sgd_update', 'optimizer_state_dict',
           'load_optimizer_state_dict', 'make_train_step', 'make_eval_step',
           'TrainState', 'ungroup_pred_sample']
