"""Device-mesh construction and sharding helpers.

The reference is single-device (SURVEY.md section 2, "parallelism: none");
the TPU-native scaling axes of this framework are:

* ``data``  -- minibatch rows, persistent PCD particles, and AIS runs.  All
  three are embarrassingly parallel chain/example axes: shard them over ICI
  and let XLA turn the gradient / convergence reductions into psums.
* ``model`` -- hidden-unit columns of the largest weight matrices
  (e.g. 3072x7800 in the CIFAR pipeline), sharded for memory and MXU
  utilization.

Models take a mesh via ``model.set_mesh(make_mesh())``; everything else is
GSPMD -- programs are written once and partitioned by XLA.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=('data', 'model'), devices=None):
    """Build a Mesh over `devices` (default: all).

    If `shape` is None, all devices go to the leading ('data') axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError('mesh shape {0} does not match {1} devices'
                         .format(shape, n))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh, X, axis='data'):
    """Place a (batch, features) array with rows sharded along `axis`."""
    return jax.device_put(X, NamedSharding(mesh, P(axis, None)))


def shard_model_columns(mesh, W, axis='model'):
    """Place a (in, out) weight matrix with output columns sharded."""
    return jax.device_put(W, NamedSharding(mesh, P(None, axis)))


def replicate(mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def fully_replicated(x):
    """True unless `x` is a jax.Array partitioned across devices.

    Used by the training engines to route manually model-sharded
    parameters onto the GSPMD epoch (a shard_map epoch whose in_specs
    declare parameters replicated would silently all-gather them)."""
    sharding = getattr(x, 'sharding', None)
    if sharding is None:
        return True
    return bool(sharding.is_fully_replicated)
