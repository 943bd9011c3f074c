"""Live stereo-webcam demo pipeline.

Reference equivalent: demo/ (CameraReader -> per-view MediaPipe 2D ->
UmeTracker 3D -> visualizer + Unity-over-UDP). Re-designed around the
native SPSC frame ring (utils/native.py) and a single jitted TPU frame
step; the 2D detector is pluggable (MediaPipe when installed, else a
replay/synthetic source for development machines).
"""
