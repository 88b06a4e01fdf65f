// Binary tensor wire protocol (client side).
//
// Same byte format as the reference client (spec comments:
// /root/reference/main/static/main/nodes/net_node.js:60-80,236-248):
//   u32 byte_size | u32 magic | u32 block_cnt | u32 json_size
//   utf-8 json, zero-padded to 4B | per tensor: u32 block_size |
//   u32 dim_cnt | u32 dims[] | f32 data[]
// Request magic 0x69babe69, response magic 0xdeadbeef, little-endian.

export const REQUEST_MAGIC = 0x69babe69;
export const RESPONSE_MAGIC = 0xdeadbeef;

function align4(n) {
	return (n + 3) & ~3;
}

/**
 * @param {Object} jsonObj
 * @param {{dims:number[], data:Float32Array}[]} tensors
 * @returns {ArrayBuffer}
 */
export function encodeMessage(jsonObj, tensors, magic = REQUEST_MAGIC) {
	const jsonBytes = new TextEncoder().encode(JSON.stringify(jsonObj));
	let size = align4(16 + jsonBytes.length);
	for (const t of tensors) size += 8 + 4 * t.dims.length + 4 * t.data.length;

	const buf = new ArrayBuffer(size);
	const view = new DataView(buf);
	const u8 = new Uint8Array(buf);

	view.setUint32(0, size, true);
	view.setUint32(4, magic, true);
	view.setUint32(8, tensors.length, true);
	view.setUint32(12, jsonBytes.length, true);
	u8.set(jsonBytes, 16);

	let off = align4(16 + jsonBytes.length);
	for (const t of tensors) {
		const blockSize = 8 + 4 * t.dims.length + 4 * t.data.length;
		view.setUint32(off, blockSize, true);
		view.setUint32(off + 4, t.dims.length, true);
		off += 8;
		for (const d of t.dims) {
			view.setUint32(off, d, true);
			off += 4;
		}
		new Float32Array(buf, off, t.data.length).set(t.data);
		off += 4 * t.data.length;
	}
	return buf;
}

/**
 * @param {ArrayBuffer} buf
 * @returns {{json:any, tensors:{dims:number[], data:Float32Array}[]}}
 */
export function decodeMessage(buf, expectMagic = RESPONSE_MAGIC) {
	const view = new DataView(buf);
	const byteSize = view.getUint32(0, true);
	const magic = view.getUint32(4, true);
	if (magic !== expectMagic) {
		throw new Error(`bad magic 0x${magic.toString(16)}`);
	}
	if (byteSize > buf.byteLength) throw new Error("truncated message");
	const blockCnt = view.getUint32(8, true);
	const jsonSize = view.getUint32(12, true);
	const json = JSON.parse(
		new TextDecoder().decode(new Uint8Array(buf, 16, jsonSize)),
	);
	let off = align4(16 + jsonSize);
	const tensors = [];
	for (let i = 0; i < blockCnt; i++) {
		const blockSize = view.getUint32(off, true);
		const dimCnt = view.getUint32(off + 4, true);
		const dims = [];
		let elems = 1;
		for (let d = 0; d < dimCnt; d++) {
			dims.push(view.getUint32(off + 8 + 4 * d, true));
			elems *= dims[d];
		}
		if (dimCnt === 0) elems = 1;
		const dataOff = off + 8 + 4 * dimCnt;
		// negotiated extension: response entries tagged dtype:"bf16" carry
		// u16 bf16 bits (half the bytes) — upcast to f32 here so every
		// consumer still sees Float32Array, like the reference format
		const dtype =
			Array.isArray(json) && json[i] && json[i].dtype
				? json[i].dtype
				: "f32";
		let data;
		if (dtype === "bf16") {
			const bits = new Uint16Array(buf, dataOff, elems);
			data = new Float32Array(elems);
			const u32 = new Uint32Array(data.buffer);
			for (let e = 0; e < elems; e++) u32[e] = bits[e] << 16;
		} else {
			// Float32Array view requires 4B alignment; format guarantees it
			data = new Float32Array(buf, dataOff, elems);
		}
		tensors.push({ dims, data });
		off += blockSize;
	}
	return { json, tensors };
}

/**
 * POST the graph to /compute and route outputs per (node,channel).
 * opts.respDtype = "bf16" opts into half-size response blocks (viewer taps
 * don't need f32; the server tags each block so decode stays exact).
 */
export async function compute(requestJson, tensors, opts = {}) {
	if (opts.respDtype) requestJson = { ...requestJson, resp_dtype: opts.respDtype };
	const body = encodeMessage(requestJson, tensors);
	const resp = await fetch("compute", { method: "POST", body });
	if (!resp.ok) {
		throw new Error(await resp.text());
	}
	const { json, tensors: outTensors } = decodeMessage(await resp.arrayBuffer());
	const outputs = new Map(); // "node/channel" -> tensor
	json.forEach((meta, i) => {
		outputs.set(`${meta.node}/${meta.channel}`, outTensors[i]);
	});
	return outputs;
}
