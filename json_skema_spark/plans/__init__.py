"""Schema model + compiler: schema document -> DAG of Catalyst predicates."""
