"""Multi-device / multi-host parallelism: device meshes, sharded render and
voxel evaluation, gradient all-reduce for the differentiable fit."""
