"""Concrete RBM flavours (reference rbm/rbm.py:10-123 equivalents)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .base_rbm import BaseRBM
from ..layers import BernoulliLayer, MultinomialLayer, GaussianLayer


class BernoulliRBM(BaseRBM):
    """RBM with Bernoulli visible and hidden units."""

    def __init__(self, model_path='b_rbm_model/', *args, **kwargs):
        super(BernoulliRBM, self).__init__(v_layer_cls=BernoulliLayer,
                                           h_layer_cls=BernoulliLayer,
                                           model_path=model_path,
                                           *args, **kwargs)

    def _free_energy(self, state, v, key=None):
        """F(v) = -v.vb - sum softplus(vW + hb), batch-mean
        (reference rbm.py:17-22)."""
        T1 = -(v @ state['vb'])
        T2 = -jnp.sum(jax.nn.softplus(v @ state['W'] + state['hb']), axis=1)
        return jnp.mean(T1 + T2, axis=0)


class MultinomialRBM(BaseRBM):
    """RBM with Bernoulli visible and one Multinomial hidden unit
    (= `n_samples` softmax units with tied weights).

    The free energy is the reference's Monte-Carlo estimate
    (rbm.py:50-60): hidden counts are drawn from a uniform multinomial and
    contracted against -vW, with the log multinomial-coefficient correction
    -lgamma(M+K) + lgamma(M+1) + lgamma(K).
    """

    def __init__(self, n_samples=100, model_path='m_rbm_model/',
                 *args, **kwargs):
        self.n_samples = n_samples
        super(MultinomialRBM, self).__init__(
            v_layer_cls=BernoulliLayer,
            h_layer_cls=MultinomialLayer,
            h_layer_params=dict(n_samples=self.n_samples),
            model_path=model_path, *args, **kwargs)

    def _free_energy(self, state, v, key=None):
        K = float(self.n_hidden)
        M = float(self.n_samples)
        dtype = v.dtype
        T1 = -(v @ state['vb'])
        T2 = -(v @ state['W'])
        probs = jnp.full((self.n_hidden,), 1. / K, dtype=dtype)
        h_hat = jax.random.multinomial(
            key, jnp.asarray(M, dtype=dtype), probs).astype(dtype)
        T3 = T2 @ h_hat
        fe = jnp.mean(T1 + T3, axis=0)
        fe += (-gammaln(M + K) + gammaln(M + 1.) + gammaln(K)).astype(dtype)
        return fe

    def transform(self, *args, **kwargs):
        """Expected softmax probabilities: counts / n_samples
        (reference rbm.py:62-65)."""
        H = super(MultinomialRBM, self).transform(*args, **kwargs)
        H /= float(self.n_samples)
        return H


class GaussianRBM(BaseRBM):
    """RBM with Gaussian visible (fixed sigma) and Bernoulli hidden units.

    Following the reference (rbm.py:101-107), inputs are divided by sigma
    on ingestion -- the `_preprocess` hook applies to fit / transform /
    metrics alike -- and the free energy is the quadratic form of
    rbm.py:109-116 in the divided space.
    """

    def __init__(self, learning_rate=1e-3, sigma=1.,
                 model_path='g_rbm_model/', *args, **kwargs):
        self.sigma = sigma
        super(GaussianRBM, self).__init__(
            v_layer_cls=GaussianLayer,
            v_layer_params=dict(sigma=self.sigma),
            h_layer_cls=BernoulliLayer,
            learning_rate=learning_rate,
            model_path=model_path, *args, **kwargs)
        if hasattr(self.sigma, '__iter__'):
            self._sigma_arr = np.asarray(self.sigma, dtype=self._np_dtype)
            self.sigma = np.asarray(self.sigma)
        else:
            self._sigma_arr = np.repeat(self.sigma, self.n_visible) \
                                .astype(self._np_dtype)

    def _preprocess(self, X):
        X = np.asarray(X, dtype=self._np_dtype)
        return X / self._sigma_arr[None, :]

    def _free_energy(self, state, v, key=None):
        sigma = jnp.asarray(self._sigma_arr, dtype=v.dtype)
        T1 = state['vb'] / sigma
        T2 = jnp.square(v - T1[None, :])
        T3 = 0.5 * jnp.sum(T2, axis=1)
        T4 = -jnp.sum(jax.nn.softplus(v @ state['W'] + state['hb']), axis=1)
        return jnp.mean(T3 + T4, axis=0)


def logit_mean(X):
    """Per-feature logit of the data marginal -- the recommended visible-bias
    init (Hinton's practical guide; reference rbm.py:119-123)."""
    p = np.mean(np.asarray(X), axis=0)
    p = np.clip(p, 1e-7, 1. - 1e-7)
    return np.log(p / (1. - p))
