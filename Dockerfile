# TPU VM image for boltzmann-machines-tpu (reference Dockerfile analog).
# Run on a Cloud TPU VM:  docker build . -t bmtpu && docker run --privileged
# --net=host -it bmtpu bash   (libtpu is provided by jax[tpu]).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make curl && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY boltzmann_machines_tpu ./boltzmann_machines_tpu
COPY native ./native
COPY examples ./examples
COPY tests ./tests
COPY data ./data
COPY makefile tb bench.py ./

RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir optax flax tqdm pytest scikit-learn && \
    pip install --no-cache-dir -e . && \
    g++ -O3 -shared -fPIC native/bm_native.cpp -o native/libbm_native.so

CMD ["bash"]
