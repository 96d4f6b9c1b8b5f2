"""CLI parser helpers (reference utils/parsers.py equivalent)."""
from __future__ import annotations

import argparse


class CustomParser(argparse.ArgumentDefaultsHelpFormatter,
                   argparse.RawDescriptionHelpFormatter):
    """Help formatter showing defaults and preserving description layout."""
