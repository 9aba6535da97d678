"""Multi-chip / multi-host scale-out over jax.sharding meshes."""
