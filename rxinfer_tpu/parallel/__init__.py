"""Multi-chip scaling: meshes, sharded batched inference, collectives."""
