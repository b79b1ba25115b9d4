"""Offline-safe JAX platform resolution.

`jax.devices()` / `jax.default_backend()` go through the TPU plugin's remote
tunnel and BLOCK for minutes (not raise) when it is wedged, so code that must
work offline decides a pinned-CPU platform from config/env STRINGS without
touching the backend.  This is the single audited copy of that idiom — the
hand-rolled variants it replaced had drifted apart (whole-string vs
first-entry 'cpu' checks).
"""

import os


def _pin() -> str:
    """The raw pinned jax platform list, lowercased ('' when unset), read
    WITHOUT initializing or probing any backend."""
    import jax
    platforms = (getattr(jax.config, 'jax_platforms', None)
                 or os.environ.get('JAX_PLATFORMS', '') or '')
    return platforms.lower().strip()


def pinned_platform() -> str:
    """The first entry of the pinned jax platform list ('' when unset)."""
    return _pin().split(',')[0].strip()


def pinned_exactly(platform: str) -> bool:
    """True iff the ENTIRE pin is exactly this one platform.

    This is the only condition under which probing ``jax.devices()`` is
    provably offline-safe: a multi-entry pin like 'cpu,axon' eagerly
    initializes EVERY listed plugin, so even a cpu-first list can block on
    the remote TPU tunnel."""
    return _pin() == platform.lower()


def resolve_backend() -> str:
    """Canonical platform name of the backend this process will compute on.

    A SINGLE-entry pin is decided from the string alone (offline-safe: the
    TPU tunnel is never touched) — with one platform there is no fallback;
    if it fails to initialize, jax raises rather than computing elsewhere.
    'axon' (the remote-TPU plugin's registration name) canonicalizes to
    'tpu', which is what its PJRT client reports as the platform.  A
    multi-entry priority list like 'axon,cpu' (and the unset default) must
    ask the initialized backend instead: the first entry is NOT trustworthy
    because jax may have fallen back to a later one.
    """
    pin = _pin()
    if ',' not in pin and pin:
        return 'tpu' if pin == 'axon' else pin
    import jax
    return jax.default_backend()
