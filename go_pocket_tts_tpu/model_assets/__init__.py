"""Model asset management: pinned manifests, checksum downloads, verification."""
