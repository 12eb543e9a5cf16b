"""Lazy jax loading: host-path CLI runs never pay `import jax`.

Measured on this container, `import jax` costs ~4.5 s of interpreter
startup — more than the entire runtime of most host-path tool
invocations (BASELINE.md interpreter-startup rows). The bin/ launchers
therefore start CPython with ``-S`` (no site initialization, so the
axon sitecustomize does not pre-import jax) and every module that only
*might* need jax imports the proxies below instead of the real thing:

    from genometester4_tpu.utils.lazyjax import jax, jnp, jit

Attribute access on a proxy performs the real import — registering the
axon PJRT plugin first when the tunnel environment is present — and
caches the resolved attribute on the proxy, so all later accesses are
one instance-dict hit.  ``jit(...)`` replaces module-level
``@partial(jax.jit, ...)`` decorators: it returns a wrapper that
defers the real ``jax.jit`` call until the first invocation (or first
attribute access, e.g. ``.lower()``), keeping kernel modules importable
in 10 ms instead of 4.5 s.

When the process was started normally (tests, library users), jax is
already imported by the time any proxy resolves, and the proxies are
transparent pass-throughs.
"""

from __future__ import annotations

import importlib
import os
import sys


_force_cpu = False


def force_cpu_platform():
    """Pin the (future, lazy) jax import to the CPU backend.

    Called by utils.backend when the cost model routes a whole run to
    the host before jax has ever been imported: any incidental jnp work
    later in the run then comes up on the in-process CPU backend
    instead of dialing the axon tunnel. No-op once jax is imported."""
    global _force_cpu
    _force_cpu = True


def ensure_jax():
    """Import jax, registering the axon PJRT plugin first when running
    without site initialization (the bin/ launchers use ``python -S``).

    The axon register lives in sitecustomize on PYTHONPATH
    (still importable under ``-S``); skipping it would leave
    ``JAX_PLATFORMS=axon`` pointing at an unregistered backend.
    """
    if "jax" in sys.modules:
        return sys.modules["jax"]
    if _force_cpu:
        m = importlib.import_module("jax")
        # env vars are read at import; past that only config works
        # (CLAUDE.md: "env vars set later are ignored")
        m.config.update("jax_platforms", "cpu")
        return m
    if ("sitecustomize" not in sys.modules
            and os.environ.get("PALLAS_AXON_POOL_IPS")):
        try:
            import sitecustomize  # noqa: F401
        except ImportError:
            pass
    return importlib.import_module("jax")


class _LazyModule:
    """Module proxy: first attribute access imports and caches."""

    def __init__(self, name: str):
        object.__setattr__(self, "_lazy_name", name)

    def __getattr__(self, attr):
        if attr.startswith("__") and attr.endswith("__"):
            # dunder probes (inspect, copy, pickling) must not trigger
            # a 4.5 s import; real modules lack most of them anyway.
            raise AttributeError(attr)
        ensure_jax()
        mod = importlib.import_module(self._lazy_name)
        val = getattr(mod, attr)
        self.__dict__[attr] = val
        return val

    def __repr__(self):
        return f"<lazy module {self._lazy_name!r}>"


class LazyJitted:
    """``jax.jit`` applied at first call instead of decoration time."""

    def __init__(self, fn, kwargs):
        self._fn = fn
        self._kw = kwargs
        self._jitted = None
        self.__name__ = getattr(fn, "__name__", "jitted")
        self.__doc__ = getattr(fn, "__doc__", None)
        self.__wrapped__ = fn

    def _resolve(self):
        j = self._jitted
        if j is None:
            j = self._jitted = ensure_jax().jit(self._fn, **self._kw)
        return j

    def __call__(self, *args, **kwargs):
        return self._resolve()(*args, **kwargs)

    def __getattr__(self, attr):  # .lower(), .trace(), ...
        return getattr(self._resolve(), attr)


def jit(fn=None, **kwargs):
    """Drop-in for ``jax.jit`` / ``partial(jax.jit, ...)`` as a
    module-level decorator, without importing jax at decoration time."""
    if fn is not None:
        return LazyJitted(fn, kwargs)
    return lambda f: LazyJitted(f, kwargs)


jax = _LazyModule("jax")
jnp = _LazyModule("jax.numpy")
lax = _LazyModule("jax.lax")
pallas = _LazyModule("jax.experimental.pallas")
pallas_tpu = _LazyModule("jax.experimental.pallas.tpu")
jax_sharding = _LazyModule("jax.sharding")
