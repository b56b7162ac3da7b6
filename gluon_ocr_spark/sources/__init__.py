"""Sources: synthetic page corpus generator + testdata table loaders."""
