"""``python -m strugatzki_tpu`` — CLI entry point."""

import sys

from .cli import main

sys.exit(main())
