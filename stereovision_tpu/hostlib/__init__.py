"""hostlib subpackage."""
