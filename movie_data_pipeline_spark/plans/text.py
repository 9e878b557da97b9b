"""Text-analysis queries (LLM-pipeline extension surface). Populated in
subsequent milestones; see movie_data_pipeline_spark/functions/text.py.
"""
