"""python -m stereovision_tpu — CLI entry (reference: stereo_vision/__main__.py)."""
import sys

from .cli import main

sys.exit(main())
