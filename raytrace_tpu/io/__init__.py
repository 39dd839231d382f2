"""Image I/O: BMP writing (bmp.rs equivalent) and film encoding."""
