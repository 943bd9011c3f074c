"""Entry-point applications mirroring the reference's repo-root scripts."""
