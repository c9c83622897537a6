"""``python -m mh_spgemm_tpu <matrix.mtx>`` — benchmark CLI entry point."""

import sys

from .bench.driver import main

sys.exit(main())
