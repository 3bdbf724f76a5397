"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine
reproducing the query semantics of GDAL (reference: ehtick/gdal 3.14.0) over
image + caption tables. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
