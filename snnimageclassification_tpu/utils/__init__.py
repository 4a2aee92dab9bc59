"""Framework utilities: loss history, dict merging, plotting."""
from .dict_utils import mapping_update_recursively
from .history import LossHistory
