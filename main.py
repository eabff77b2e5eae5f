#!/usr/bin/env python
"""Entry point: precision-ladder galaxy comparison (see nbody_tpu/cli.py).

Reference-parity CLI (reference: main.py):
    python main.py --stars 5000 --ticks 2000 --compare float64,int4
    python main.py --quick
"""

from nbody_tpu.cli import main

if __name__ == "__main__":
    main()
