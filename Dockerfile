# svtyper-tpu container (parity of the reference Dockerfile, SURVEY.md §2.1)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/svtyper-tpu
COPY . .
RUN pip install --no-cache-dir numpy jax && pip install --no-cache-dir . \
    && make -C svtyper_tpu/bamio/_native libsvtbam.so

ENTRYPOINT ["svtyper"]
