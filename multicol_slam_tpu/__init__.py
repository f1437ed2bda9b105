"""MultiCol-SLAM TPU: a TPU-native multi-fisheye SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of MultiCol-SLAM
(billamiable/MultiCol-SLAM-Annotation): N rigidly-coupled fisheye cameras
tracked as one Multi-Camera System against a shared 3-D map, with MultiCol
bundle adjustment and Sim3 loop closing — re-designed for TPU hardware
(batched kernels over cameras/points/hypotheses, autodiff Jacobians,
Schur-complement LM, sharded BA over a device mesh).
"""

__version__ = "0.1.0"
