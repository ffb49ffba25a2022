"""Source connectors: GeoTIFF raster ingest (the reference's capability)."""
