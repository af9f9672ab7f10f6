"""Attic: kept, tested, *measured-negative* kernels.

Code here is off every default path and exists as an executable record of
optimization attempts that lost to XLA's own emitters on v5e (see
docs/ROUND2.md "measured negative results"). Each module documents the
experiment and its numbers; tests keep them honest so they can be
re-evaluated on future TPU generations.
"""
