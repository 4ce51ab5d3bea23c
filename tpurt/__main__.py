"""``python -m tpurt`` → the CLI (SURVEY.md §5 config system)."""

import sys

from tpurt.cli import main

sys.exit(main())
