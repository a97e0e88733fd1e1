"""PySpark-native analytics engine with the capabilities of
vgvoleg/ydb-vector-search-demo (see SURVEY.md).

Everything here is built on the public PySpark DataFrame/SQL API; vector
math uses JVM-side higher-order array functions (no Python in the hot
path), top-k plans as TakeOrderedAndProject, and MLlib provides batch
ANN index building (KMeans IVF, LSH).
"""

__version__ = "0.1.0"
