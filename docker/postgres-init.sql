-- Provision the MLflow backend-store database alongside the cache DB
-- (the reference shipped the same pattern: postgres-init/init-dbs.sql
-- creating app + mlflow databases on one server).  Runs once on first
-- container start via /docker-entrypoint-initdb.d.
CREATE DATABASE mlflow_db OWNER frs;
