"""airdatapipeline_spark — PySpark-native engine with the query and
data-processing capabilities of edu-data-dev/AirDataPipeline.

See SURVEY.md for the reference analysis and README.md for the design.
"""

__version__ = "0.1.0"
