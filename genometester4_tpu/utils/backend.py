"""Compute-placement cost model.

Device compute only pays when the compute/transfer ratio is high. The
counting kernels read back scalars or DB-sized tables — always worth
the accelerator. But pipelines whose OUTPUT is the dataset (set
operations, list writing, query dumps) must pull every result byte back
to the host; whether that pays depends on the link:

* production TPU hosts (platform "tpu"): PCIe at GB/s — device wins;
* this development tunnel (platform "axon"): ~0.4 MB/s device→host
  (measured, BASELINE.md) — a 20M-word glistcompare spends minutes in
  readback that the CPU backend finishes in seconds.

``output_heavy_device()`` returns the device to run output-heavy
pipelines on: the default backend normally, the in-process CPU backend
when the default is the axon tunnel. The same jitted code runs either
way, so results are bit-identical.
"""

from __future__ import annotations

import os
import sys

from genometester4_tpu.utils.lazyjax import jax


def accelerator_link_is_slow() -> bool:
    """True when the accelerator sits behind the axon dev tunnel.

    The tunnel registers under backend key "axon" but reports platform
    "tpu" (so ``jax.default_backend()`` cannot distinguish it from a
    real PCIe-attached chip); its PJRT ``platform_version`` string
    carries the plugin identity. ``GT4_TPU_LINK=fast|slow`` overrides.

    Resolution order keeps the decision free of the ~4.5 s jax import
    for host-path CLI runs (bin/ launchers, utils.lazyjax): the
    override first, then the tunnel's own environment variables
    (``PALLAS_AXON_POOL_IPS`` is set iff the axon relay is this
    process's accelerator), and only as a last resort — jax already
    imported, platform ambiguous — the PJRT platform_version probe.
    """
    ov = os.environ.get("GT4_TPU_LINK")
    if ov == "fast":
        return False
    if ov == "slow":
        return True
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return False          # no accelerator in play at all
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True           # the axon tunnel is the accelerator
    if "jax" not in sys.modules:
        return False          # nothing signals a tunnel; assume real link
    try:
        d = jax.devices()[0]
        return "axon" in getattr(d.client, "platform_version", "")
    except Exception:
        return False


def prefer_host_for_output_heavy() -> bool:
    """Output-heavy pipelines run on the host when there is no
    accelerator at all, or the accelerator's readback link is slow.

    Checked without importing jax where possible: a slow link answers
    True by itself, and ``JAX_PLATFORMS=cpu`` answers True by itself."""
    if accelerator_link_is_slow():
        return True
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    return jax.default_backend() == "cpu"


def output_heavy_device():
    if jax.default_backend() != "cpu" and accelerator_link_is_slow():
        return jax.local_devices(backend="cpu")[0]
    return None


_thp_disabled = False


def disable_numpy_thp():
    """Turn off numpy's MADV_HUGEPAGE on large allocations.

    Measured on this VM class: first-touch of a 400 MB buffer costs
    1.5 s with transparent-huge-page madvise but 0.2 s with 4 KB pages
    (THP zeroing/compaction is slow under virtualization). The host
    counting pipelines allocate multi-hundred-MB buffers per run, so the
    madvise is pure loss there. Safe to call any time; idempotent."""
    global _thp_disabled
    if _thp_disabled:
        return
    try:
        try:
            from numpy._core import multiarray as _ma
        except ImportError:                      # numpy < 2
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:
        pass
    _thp_disabled = True


class output_heavy_compute:
    """Context manager: route jnp/jit work to the right backend.

    When jax has not been imported yet (bin/ launchers, utils.lazyjax)
    the routing decision is made from the environment alone: a slow
    link or ``JAX_PLATFORMS=cpu`` pins the eventual lazy jax import to
    the CPU backend (``lazyjax.force_cpu_platform``) instead of paying
    the import up front — most host-path runs then never import jax at
    all."""

    def __init__(self):
        # large host temporaries: see disable_numpy_thp. Only when numpy
        # is already loaded — importing it here costs ~220 ms and
        # defeats the numpy-free bin/ stat fast paths (round-3 find:
        # glistquery --distribution spent 0.22 s of its 0.40 s wall
        # importing numpy to toggle a madvise numpy never made). Every
        # numpy-allocating host pipeline calls disable_numpy_thp()
        # itself after importing numpy (CLAUDE.md).
        if "numpy" in sys.modules:
            disable_numpy_thp()
        if "jax" not in sys.modules:
            from genometester4_tpu.utils import lazyjax
            if prefer_host_for_output_heavy():
                lazyjax.force_cpu_platform()
            # fast link + no jax yet: the accelerator is the default
            # backend once imported; either way no device ctx needed
            self._dev = None
        else:
            self._dev = output_heavy_device()
        self._ctx = None

    def __enter__(self):
        if self._dev is not None:
            self._ctx = jax.default_device(self._dev)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return False
