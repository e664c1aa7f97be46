"""``python -m go_pocket_tts_tpu`` CLI entry."""

import sys

from go_pocket_tts_tpu.cli.main import main

sys.exit(main())
