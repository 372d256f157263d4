"""`python -m weatherforecast_stgcn_maml_tpu` -> the CLI."""

import sys

from weatherforecast_stgcn_maml_tpu.cli import main

sys.exit(main())
