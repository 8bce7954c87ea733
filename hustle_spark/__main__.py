"""``python -m hustle_spark`` — the interactive shell (see repl.py)."""

from .repl import main

main()
