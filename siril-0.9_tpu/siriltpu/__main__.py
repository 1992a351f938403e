"""``python -m siriltpu`` — the CLI entry point (same as the
``siriltpu`` console script; reference analog: the siril binary's
command line, src/main.c)."""

from siriltpu.cli.main import main

if __name__ == "__main__":
    raise SystemExit(main())
