"""Subprocess driver for tests/test_multihost.py.

Runs ONE process of a GT4_DIST_* group through the production glistmaker
CLI path (cli/glistmaker.main → pipelines.listmaker.make_list →
parallel.multihost.make_list_multihost). Argv:

    _mh_driver.py COORD NPROCS PROC_ID WORDLEN OUTNAME INPUT...
"""

import os
import sys


def main():
    coord, nprocs, pid, k, out, *inputs = sys.argv[1:]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["GT4_DIST_COORD"] = coord
    os.environ["GT4_DIST_NPROCS"] = nprocs
    os.environ["GT4_DIST_PROC_ID"] = pid
    from genometester4_tpu.cli import glistmaker
    return glistmaker.main(list(inputs) + ["-w", k, "-o", out])


if __name__ == "__main__":
    sys.exit(main())
