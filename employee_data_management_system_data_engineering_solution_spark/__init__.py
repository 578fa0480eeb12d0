"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo
``ananyamissra/Employee-Data-Management-System-Data-Engineering-Solution``.

Built Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten physical
execution, Structured Streaming for the stream surface. See SURVEY.md for
the operator inventory this package covers.

Import shorthand used throughout the repo::

    import employee_data_management_system_data_engineering_solution_spark as eds
"""

from .session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
