"""`python -m pnr_tpu` == `python -m pnr_tpu.cli` (the Advantra CLI)."""

from pnr_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
