"""sklearn-style parameter protocol (reference base/base_model.py:8-67 analog)."""

import numpy as np
from copy import deepcopy

from .base import is_param_name, is_attribute_name
from .mixin import SeedMixin


class BaseModel(SeedMixin):
    def __init__(self, *args, **kwargs):
        super(BaseModel, self).__init__(*args, **kwargs)

    def get_params(self, deep=True, include_attributes=True):
        """Get hyperparameters (and optionally trailing-underscore attributes)."""
        params = vars(self)
        keep = lambda k: is_param_name(k) or (include_attributes and is_attribute_name(k))
        params = {k: params[k] for k in params if keep(k)}
        if deep:
            params = deepcopy(params)
        return params

    def set_params(self, **params):
        for k, v in params.items():
            if (is_param_name(k) or is_attribute_name(k)) and hasattr(self, k):
                setattr(self, k, v)
            else:
                raise ValueError("invalid param name '{0}'".format(k))
        return self

    def _serialize(self, params):
        """Make params JSON-serializable; refuse arrays > 1e6 elements
        (large learned tensors live in the array checkpoint instead)."""
        for k, v in params.items():
            if isinstance(v, np.ndarray):
                if v.size > 1e6:
                    params[k] = None
                else:
                    params[k] = v.tolist()
            elif isinstance(v, (np.integer,)):
                params[k] = int(v)
            elif isinstance(v, (np.floating,)):
                params[k] = float(v)
        return params

    def _deserialize(self, params):
        return params
