#!/usr/bin/env python
"""Tiny TPU reachability probe (CLAUDE.md discipline): run a 1-op program
and fetch it to host. Exits 0 iff the TPU answered."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.ones((8, 8))
v = float(np.asarray(jnp.sum(x * 2.0)))
print("backend:", jax.default_backend(), "sum:", v, flush=True)
sys.exit(0 if v == 128.0 else 1)
