from meteor_spark.runner.agent import Agent, Run

__all__ = ["Agent", "Run"]
