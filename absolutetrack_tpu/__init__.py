"""AbsoluteTrack-TPU: a TPU-native multi-view hand-tracking engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
2InfinityN6eyond/AbsoluteTrack (a fork of Meta's UmeTrack): fisheye multi-view
capture -> perspective crop cameras -> CNN feature extraction -> FTL multi-view
fusion -> ConvRNN temporal fusion -> pose regression with Procrustes wrist fit
-> LBS forward kinematics -> 3D hand landmarks.

Design principles (TPU-first, not a port):
  * batched struct-of-arrays everywhere: cameras, hands, and views live in
    fixed-capacity array slots with validity masks -- no per-object Python
    classes, no ragged batches (reference: lib/tracker/tracker.py:315-368 uses
    dict-of-dicts + ragged ``sample_range``; here everything is static-shape).
  * pure functions + explicit state pytrees: the reference's stateful ConvRNN
    memory (lib/models/temporal.py:41-42) becomes a ``TrackerState`` carried
    through ``jax.lax.scan``.
  * one fused jit per frame step; multi-chip scaling via ``jax.sharding.Mesh``
    + collectives instead of multiprocessing Pools.
"""

__version__ = "0.1.0"
