"""Experimental ops: measured-but-not-shipping alternatives.

Everything here is real, tested code that lost (or has not yet won) a
measured comparison against the shipping XLA formulation on TPU — kept as
a shelf for future hardware/regimes, not imported by any model path.
"""
