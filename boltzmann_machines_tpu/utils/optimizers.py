"""Optimizers for discriminative fine-tuning (reference utils/optimizers.py
MultiAdam equivalent, built on optax).

`multi_adam` is Adam with per-parameter-group learning-rate multipliers
matched by parameter-path prefix -- used to fine-tune MLPs whose first layer
is warm-started from RBM/DBM weights (small multiplier on pretrained layers,
full rate on the new head)."""

import jax
import optax


def multi_adam(learning_rate=0.001, lr_multipliers=None,
               b1=0.9, b2=0.999, eps=1e-8):
    """Adam with per-layer learning-rate multipliers.

    Parameters
    ----------
    lr_multipliers : dict[str, float]
        Maps parameter-path prefixes (e.g. 'dense_1') to multipliers.
        A parameter whose '/'-joined path starts with a key gets
        `learning_rate * multiplier`; others get `learning_rate`.
    """
    lr_multipliers = dict(lr_multipliers or {})
    base = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init_fn(params):
        return base.init(params)

    def update_fn(updates, state, params=None):
        updates, state = base.update(updates, state, params)
        return scale_by_multipliers(updates, lr_multipliers,
                                    learning_rate), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_multipliers(updates, lr_multipliers, learning_rate):
    """Scale an update pytree by ``-learning_rate * multiplier(path)``;
    the shared core of `multi_adam` and the fine-tuning loop (where the
    learning rate is dynamic for reduce-on-plateau)."""
    lr_multipliers = dict(lr_multipliers or {})

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, 'key'):
                parts.append(str(p.key))
            elif hasattr(p, 'idx'):
                parts.append(str(p.idx))
            elif hasattr(p, 'name'):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return '/'.join(parts)

    def multiplier_of(path):
        s = path_str(path)
        for key, value in lr_multipliers.items():
            key = str(key)
            # exact path or segment-boundary prefix ('1' must not match '10/W')
            if s == key or s.startswith(key + '/'):
                return value
        return 1.

    return jax.tree_util.tree_map_with_path(
        lambda path, u: u * (-learning_rate * multiplier_of(path)), updates)


# alias matching the reference class name
MultiAdam = multi_adam
