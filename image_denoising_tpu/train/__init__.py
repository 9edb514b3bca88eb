from .schedule import hpo_milestones, multistep_lr, reference_milestones
from .state import TrainState, create_train_state, set_learning_rate
from .steps import make_structure_train_step, make_n2n_train_step, make_l1_train_step

__all__ = [
    "multistep_lr",
    "reference_milestones",
    "hpo_milestones",
    "TrainState",
    "create_train_state",
    "set_learning_rate",
    "make_structure_train_step",
    "make_n2n_train_step",
    "make_l1_train_step",
]
