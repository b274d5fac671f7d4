"""Experiment run harness (behavioral spec: reference docs/call_model.py).

``LCGPRun`` wraps define/train/predict around a data dict — the same shape
the reference's illustration scripts use — returning NumPy arrays.
"""
from __future__ import annotations

import numpy as np

from .models.lcgp import LCGP


class SuperRun:
    def __init__(self, runno: str, data, verbose: bool = False, **kwargs):
        self.data = data
        self.xtrain = data['xtrain']
        self.ytrain = data['ytrain']
        self.xtest = data['xtest']
        self.ytest = data.get('ytest')
        if 'ytrue' in data:
            self.ytrue = data['ytrue']
        if 'ystd' in data:
            self.ystd = data['ystd']
        self.runno = runno
        self.model = None
        self.modelname = ''
        self.n = self.xtrain.shape[0]
        self.num_output = self.ytrain.shape[0]
        self.verbose = verbose

    def define_model(self):
        pass

    def train(self):
        pass

    def predict(self):
        pass


class LCGPRun(SuperRun):
    def __init__(self, submethod: str = 'full', robust: bool = True,
                 err_struct=None, num_latent=None, var_threshold=None,
                 precision: str = 'high', **kwargs):
        super().__init__(**kwargs)
        self.modelname = 'LCGP'
        self.num_latent = num_latent
        self.var_threshold = var_threshold
        self.submethod = submethod
        self.robust = robust
        self.err_struct = err_struct
        self.precision = precision
        if self.robust:
            self.modelname += '_robust'

    def define_model(self):
        self.model = LCGP(y=self.ytrain, x=self.xtrain,
                          parameter_clamp_flag=False,
                          q=self.num_latent,
                          var_threshold=self.var_threshold,
                          diag_error_structure=self.err_struct,
                          robust_mean=self.robust,
                          submethod=self.submethod,
                          precision=self.precision)

    def train(self, **fit_kwargs):
        self.model.fit(verbose=self.verbose, **fit_kwargs)

    def predict(self, train: bool = False, return_fullcov: bool = False,
                as_pxn: bool = False):
        xtest = self.xtrain if train else self.xtest
        out = self.model.predict(xtest, return_fullcov=return_fullcov)
        arrays = [np.asarray(o) if o is not None else None for o in out]
        if as_pxn:
            arrays = [a.T if a is not None and a.ndim == 2 else a
                      for a in arrays]
        return tuple(arrays)


# ---------------------------------------------------------------------------
# Harness-local metric helpers (behavioral spec: docs/call_model.py:89-126 —
# the reference ships these *variants* alongside lcgp.evaluation; semantics
# differ slightly: per-output normalization options, z-based intervals,
# mean-aggregated DSS)
# ---------------------------------------------------------------------------

def rmse(ytrue, yhat):
    return float(np.sqrt(np.mean((np.asarray(ytrue) - np.asarray(yhat)) ** 2)))


def normalized_rmse(ytrue, yhat, method: str = 'range'):
    ytrue = np.asarray(ytrue)
    yhat = np.asarray(yhat)
    if method == 'range':
        scale = np.ptp(ytrue, axis=1, keepdims=True)
    elif method == 'std':
        scale = np.std(ytrue, axis=1, ddof=0, keepdims=True)
    else:
        raise ValueError("method must be 'range' or 'std'")
    scale = np.where(scale == 0, 1.0, scale)
    per = np.sqrt(np.mean((ytrue - yhat) ** 2, axis=1, keepdims=True)) / scale
    return float(np.mean(per))


def intervalstats(ytrue, mean, var, z: float = 1.96):
    """Nominal-z predictive interval coverage/width.  Use confvar when
    comparing to noise-free truth."""
    sd = np.sqrt(np.asarray(var))
    ytrue = np.asarray(ytrue)
    mean = np.asarray(mean)
    covered = (ytrue >= mean - z * sd) & (ytrue <= mean + z * sd)
    return float(np.mean(covered)), float(np.mean(2 * z * sd))


def dss(ytrue, mean, var, use_diag: bool = True):
    """Mean-aggregated Gaussian Dawid–Sebastiani score."""
    eps = 1e-12
    s2 = np.maximum(np.asarray(var), eps)
    term = ((np.asarray(ytrue) - np.asarray(mean)) ** 2) / s2 + np.log(s2)
    return float(np.mean(term))
