"""Source connectors: raster/points file formats → DataFrames."""
