"""CLI entry: ``python -m bachelors_tpu config.ini [more.ini ...] [--set sec.key=val]``."""
import sys

from .app.driver import main

if __name__ == "__main__":
    sys.exit(main())
