"""Parameter initialization on the host CPU backend.

Initializing a model on the tunneled TPU costs minutes of tiny-kernel
compiles, so every entry point initializes on the local CPU backend and
ships the params to the accelerator afterwards.  The init compiles must
also stay OUT of the shared accelerator compile cache (XLA:CPU entries are
host-specific AOT machine code) — ``fsutil.host_init_cache_guard`` handles
that.  This is the single audited copy of the idiom: the per-entry-point
variants it replaced had drifted apart in guard placement and fallback
behavior.
"""

import contextlib

import jax
import jax.numpy as jnp

from ..utils.fsutil import host_init_cache_guard


def host_cpu_device():
    """The first local CPU device, or None when the CPU backend is
    unavailable (never probes the TPU plugin)."""
    try:
        return jax.local_devices(backend='cpu')[0]
    except Exception:
        return None


@contextlib.contextmanager
def host_init_context():
    """Cache guard + host-CPU default device (device pin degrades to a
    no-op when the CPU backend is unavailable)."""
    cpu = host_cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with host_init_cache_guard(), ctx:
        yield


def init_model_host(model, input_hw, seed=0):
    """``model.init`` for a (1, H, W, 3) f32 input — jitted on the host CPU
    when that backend exists, falling back to an uncompiled init on the
    default device otherwise (or if the CPU path fails)."""
    rngs = {'params': jax.random.PRNGKey(seed),
            'dropout': jax.random.PRNGKey(seed + 1)}
    x = jnp.zeros((1, *input_hw, 3), jnp.float32)
    if host_cpu_device() is not None:
        try:
            with host_init_context():
                return jax.jit(model.init, static_argnums=(2,))(rngs, x, False)
        except Exception as exc:
            # Fall back, but SAY so: eager init on a tunneled TPU is minutes
            # of tiny-kernel compiles (the hazard this module exists to
            # avoid) — a silent demotion would read as a mystery stall.
            from ..utils.logging import CAUTION
            print(CAUTION("Host-CPU model init failed ({}: {}); falling "
                          "back to eager init on the default device — "
                          "expect a slow start on TPU."
                          .format(type(exc).__name__, exc)))
    return model.init(rngs, x, False)
