# Containerized run parity with the reference's Dockerfile/Pipfile
# (/root/reference/Dockerfile:1): one image that runs the ETL CLI.
#
# The reference ships a python-slim image with pandas+boto3; the Spark
# engine needs a JVM, so the base is the official Spark-on-Python image.
# The Spark binary distro does NOT bundle hadoop-aws, so the s3a://
# connector jars are fetched at build time and dropped into $SPARK_HOME/
# jars — with them present, tests/test_s3a_integration.py runs for real
# (moto-backed) instead of skipping, and production s3a:// reads work with
# credentials from the standard AWS env-var chain, same as the reference's
# boto3 setup.
#
# Build:  docker build -t trading-data-pipeline-spark .
# Run:    docker run -e AWS_ACCESS_KEY_ID -e AWS_SECRET_ACCESS_KEY \
#             trading-data-pipeline-spark \
#             /code/configs/report1_local.yaml
# Test:   docker run --entrypoint python trading-data-pipeline-spark \
#             -m pytest /code/tests -q
FROM apache/spark:4.0.0-python3

USER root
ENV PIP_NO_CACHE_DIR=yes \
    PYTHONDONTWRITEBYTECODE=1

# s3a:// classpath: hadoop-aws matching the base image's Hadoop 3.4 line +
# the AWS SDK v2 bundle it is built against (hadoop-aws 3.4.1 pom).
ARG HADOOP_AWS_VERSION=3.4.1
ARG AWS_SDK_VERSION=2.24.6
# Integrity pinning: pass the sha256 of each jar (Maven Central publishes
# them as <jar-url>.sha256 sidecars) so the image's JVM classpath never
# depends on an unverified network fetch:
#   docker build \
#     --build-arg HADOOP_AWS_SHA256=$(curl -s <hadoop-aws-url>.sha256) \
#     --build-arg AWS_SDK_SHA256=$(curl -s <bundle-url>.sha256) ...
# The build FAILS if a supplied digest does not match. (The digests are
# build-args rather than ADD --checksum literals so version bumps stay a
# two-arg change; empty digests skip verification for offline/dev builds.)
ARG HADOOP_AWS_SHA256=""
ARG AWS_SDK_SHA256=""
# ADD (not curl) so the fetch has no tool dependency in the base image
ADD https://repo1.maven.org/maven2/org/apache/hadoop/hadoop-aws/${HADOOP_AWS_VERSION}/hadoop-aws-${HADOOP_AWS_VERSION}.jar ${SPARK_HOME}/jars/
ADD https://repo1.maven.org/maven2/software/amazon/awssdk/bundle/${AWS_SDK_VERSION}/bundle-${AWS_SDK_VERSION}.jar ${SPARK_HOME}/jars/
RUN set -eu; \
    if [ -n "${HADOOP_AWS_SHA256}" ]; then \
      echo "${HADOOP_AWS_SHA256}  ${SPARK_HOME}/jars/hadoop-aws-${HADOOP_AWS_VERSION}.jar" | sha256sum -c -; \
    fi; \
    if [ -n "${AWS_SDK_SHA256}" ]; then \
      echo "${AWS_SDK_SHA256}  ${SPARK_HOME}/jars/bundle-${AWS_SDK_VERSION}.jar" | sha256sum -c -; \
    fi

WORKDIR /code
COPY pyproject.toml README.md ./
COPY trading_data_pipeline_spark ./trading_data_pipeline_spark
COPY configs ./configs
COPY tests ./tests

# Pillow enables the real image-codec path in operators/multimodal.py
# (gated by importorskip in tests; the engine falls back to the
# deterministic fake codec without it). moto/boto3 back the s3a tests.
RUN pip install . pillow moto boto3 pytest

ENTRYPOINT ["python", "-m", "trading_data_pipeline_spark"]
