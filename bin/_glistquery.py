#!/usr/bin/env -S python3 -S -u
# Fast launcher: CPython -S skips site initialization, so the axon
# sitecustomize does not pre-import jax (~4.5 s on this container;
# BASELINE.md interpreter-startup rows). The package imports jax
# lazily (utils/lazyjax.py) only when a pipeline picks the device.
import os
import sys

_venv = os.environ.get("VIRTUAL_ENV", "/opt/venv")
_sp = os.path.join(_venv, "lib",
                   "python%d.%d" % sys.version_info[:2], "site-packages")
if os.path.isdir(_sp):
    sys.path.insert(0, _sp)
else:                      # unknown layout: fall back to full site init
    import site
    site.main()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genometester4_tpu.cli.glistquery import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
