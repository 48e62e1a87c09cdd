from .base_rbm import BaseRBM
from .rbm import BernoulliRBM, MultinomialRBM, GaussianRBM, logit_mean
