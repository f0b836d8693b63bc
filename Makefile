# Convenience targets (the analog of the reference's top-level CMake
# workflow; the Python package itself needs no build step).

.PHONY: all native test bench ubench clean

all: native

native: native/libndzip_cpu.so

native/libndzip_cpu.so: native/ndzip_cpu.cc
	$(CXX) -O3 -march=native -funroll-loops -std=c++17 -shared -fPIC -pthread $< -o $@

# CMake variant of the native build
native-cmake:
	cmake -S native -B native/build -G Ninja && cmake --build native/build

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

ubench:
	python -m ndzip_tpu.ubench

clean:
	rm -f native/libndzip_cpu.so
	rm -rf native/build
