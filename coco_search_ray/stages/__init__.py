"""Ray Data stage implementations (map_batches bodies, actor pools,
shuffle compositions)."""
