"""TPU-native energy-based-model framework.

A brand-new JAX/XLA/Pallas implementation with the full capabilities of the
reference TF1 library `yell/boltzmann-machines`: RBMs (Bernoulli /
Multinomial / Gaussian units), arbitrary-depth DBMs trained with PCD +
mean-field variational inference, AIS partition-function / ELBO estimation,
sklearn-style fit/transform/sample APIs, schedules, regularizers, and
checkpoint/resume with reproducible RNG.
"""

__version__ = '0.1.0'

from . import base, utils
from .layers import BernoulliLayer, MultinomialLayer, GaussianLayer
from .ebm import EnergyBasedModel
from .rbm import BaseRBM, BernoulliRBM, MultinomialRBM, GaussianRBM, logit_mean
from .dbm import DBM
