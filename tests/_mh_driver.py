"""Subprocess driver for tests/test_multihost.py.

Runs ONE process of a GT4_DIST_* group through a production CLI path
(e.g. cli/glistmaker.main → pipelines.listmaker.make_list →
parallel.multihost; cli/glistcompare.main → sharded_pair_ops/
sharded_multi_op over the global mesh; cli/gmer_counter.main →
DBCounter's global-mesh psum counting). Argv:

    _mh_driver.py COORD NPROCS PROC_ID TOOL ARG...
"""

import importlib
import os
import sys


def main():
    coord, nprocs, pid, tool, *rest = sys.argv[1:]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["GT4_DIST_COORD"] = coord
    os.environ["GT4_DIST_NPROCS"] = nprocs
    os.environ["GT4_DIST_PROC_ID"] = pid
    mod = importlib.import_module("genometester4_tpu.cli." + tool)
    return mod.main(list(rest))


if __name__ == "__main__":
    sys.exit(main())
