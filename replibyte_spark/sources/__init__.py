from .sqldump import read_sql_dump, split_statements, parse_insert  # noqa: F401
