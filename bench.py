"""Repo-root shim: the driver runs ``python bench.py`` here; the
implementation ships inside the package so the ``waveform-tpu-bench``
console script works from a pip install too."""
import sys

from waveform_tpu.bench import main

if __name__ == "__main__":
    sys.exit(main())
