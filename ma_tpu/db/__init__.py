"""SQL abstraction layer (the libs/db_connect role) over sqlite3."""
from ma_tpu.db.sql_api import (  # noqa: F401
    BulkInserter,
    SQLDB,
    SQLTable,
    SQLTableWithAutoPriKey,
)
from ma_tpu.db.pool import PooledSQLDBCon, SQLDBConPool  # noqa: F401
