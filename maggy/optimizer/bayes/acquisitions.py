"""Acquisition-function classes (reference
`maggy/optimizer/bayes/acquisitions.py:25-200`).

The reference delegates EI/PI/LCB to skopt's gaussian-acquisition
helpers (minimization convention: EI and PI are returned NEGATED so
smaller is better, LCB is mu - kappa*sigma directly) and stubs
UCB/TPE_EI/HLP with NotImplementedError; this module reproduces that
surface against the engine's numpy surrogate (`maggy_spark.bayes`),
whose `predict(X) -> (mu, sigma)` matches the contract these
functions need. The GP optimizer itself consumes the engine's
functional forms (`expected_improvement` etc.); these classes exist
for reference user code that imports them directly.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from maggy_spark.bayes import _norm_cdf, _norm_pdf


def _gaussian_values(X, surrogate_model):
    X = np.atleast_2d(np.asarray(X, dtype=float))
    mu, sigma = surrogate_model.predict(X)
    mu = np.asarray(mu, dtype=float).reshape(-1)
    sigma = np.maximum(np.asarray(sigma, dtype=float).reshape(-1), 1e-12)
    return X, mu, sigma


class AbstractAcquisitionFunction(ABC):
    @staticmethod
    @abstractmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        """Acquisition values at X, shape (n_points,); minimization
        convention (smaller is better)."""

    @staticmethod
    @abstractmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        """Single-point wrapper for L-BFGS (1-D input), shape (1,)."""

    def name(self) -> str:
        return str(self.__class__.__name__)


class GaussianProcess_EI(AbstractAcquisitionFunction):
    """xi in acq_func_kwargs (exploration margin, default 0.01)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        xi = float((acq_func_kwargs or {}).get("xi", 0.01))
        _, mu, sigma = _gaussian_values(X, surrogate_model)
        z = (y_opt - xi - mu) / sigma
        ei = (y_opt - xi - mu) * _norm_cdf(z) + sigma * _norm_pdf(z)
        return -ei  # skopt minimization convention

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        return GaussianProcess_EI.evaluate(
            np.expand_dims(np.asarray(x, dtype=float), axis=0), surrogate_model, y_opt, acq_func_kwargs
        ).reshape(1)


class GaussianProcess_PI(AbstractAcquisitionFunction):
    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        xi = float((acq_func_kwargs or {}).get("xi", 0.01))
        _, mu, sigma = _gaussian_values(X, surrogate_model)
        z = (y_opt - xi - mu) / sigma
        return -_norm_cdf(z)

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        return GaussianProcess_PI.evaluate(
            np.expand_dims(np.asarray(x, dtype=float), axis=0), surrogate_model, y_opt, acq_func_kwargs
        ).reshape(1)


class GaussianProcess_LCB(AbstractAcquisitionFunction):
    """kappa in acq_func_kwargs (default 1.96)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        kappa = float((acq_func_kwargs or {}).get("kappa", 1.96))
        _, mu, sigma = _gaussian_values(X, surrogate_model)
        return mu - kappa * sigma

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        return GaussianProcess_LCB.evaluate(
            np.expand_dims(np.asarray(x, dtype=float), axis=0), surrogate_model, y_opt, acq_func_kwargs
        ).reshape(1)


class GaussianProcess_UCB(AbstractAcquisitionFunction):
    """Stubbed in the reference too (acquisitions.py:138-146)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError


class TPE_EI(AbstractAcquisitionFunction):
    """Stubbed in the reference too (acquisitions.py:148-156); the
    engine's TPE computes its EI ratio internally (maggy_spark.bayes)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError


class AsyTS(AbstractAcquisitionFunction):
    """Thompson sampling: one posterior draw per candidate
    (acquisitions.py:158-184)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        try:
            draw = surrogate_model.sample_y(X)
        except TypeError:  # engine surrogate takes an explicit rng
            draw = surrogate_model.sample_y(X, np.random.default_rng())
        return np.asarray(draw).reshape(X.shape[0])

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        return AsyTS.evaluate(
            np.expand_dims(np.asarray(x, dtype=float), axis=0), surrogate_model, y_opt, acq_func_kwargs
        ).reshape(1)


class HLP(AbstractAcquisitionFunction):
    """Stubbed in the reference too (acquisitions.py:186-200)."""

    @staticmethod
    def evaluate(X, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError

    @staticmethod
    def evaluate_1_d(x, surrogate_model, y_opt, acq_func_kwargs=None):
        raise NotImplementedError


__all__ = [
    "AbstractAcquisitionFunction",
    "GaussianProcess_EI",
    "GaussianProcess_PI",
    "GaussianProcess_LCB",
    "GaussianProcess_UCB",
    "TPE_EI",
    "AsyTS",
    "HLP",
]
