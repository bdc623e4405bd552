# Containerized run parity with the reference's Dockerfile/Pipfile
# (/root/reference/Dockerfile:1): one image that runs the ETL CLI.
#
# The reference ships a python-slim image with pandas+boto3; the Spark
# engine needs a JVM, so the base is the official Spark-on-Python image.
# For s3a:// sources, hadoop-aws + aws-sdk-bundle are already on the
# classpath of this base image; credentials come from the standard AWS
# env-var chain, same as the reference's boto3 setup.
#
# Build:  docker build -t trading-data-pipeline-spark .
# Run:    docker run -e AWS_ACCESS_KEY_ID -e AWS_SECRET_ACCESS_KEY \
#             trading-data-pipeline-spark \
#             /code/configs/report1_local.yaml
FROM apache/spark:4.0.0-python3

USER root
ENV PIP_NO_CACHE_DIR=yes \
    PYTHONDONTWRITEBYTECODE=1

WORKDIR /code
COPY pyproject.toml README.md ./
COPY trading_data_pipeline_spark ./trading_data_pipeline_spark
COPY configs ./configs

RUN pip install .

ENTRYPOINT ["python", "-m", "trading_data_pipeline_spark"]
