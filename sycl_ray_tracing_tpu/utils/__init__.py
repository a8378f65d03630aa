"""I/O, config, logging: OBJ/MTL and Radiance-HDR loaders, PNG writer, CLI."""
