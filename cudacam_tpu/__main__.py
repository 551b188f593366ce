"""``python -m cudacam_tpu`` entry point."""
import sys

from cudacam_tpu.cli import main

sys.exit(main())
